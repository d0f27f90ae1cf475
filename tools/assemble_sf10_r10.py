#!/usr/bin/env python
"""Assemble CORRECTNESS_sf10_r10.json: the r9 hash sweep's 440 green keys
(registry and replica unchanged — provenance recorded per key) plus the
round-10 re-run of the 14 keys r9 deferred on oracle-side infeasibility,
now closed with staged oracles. n_deferred goes to 0.

Per-key overrides (tools/sf10_r10_overrides.json) are applied LAST: the
two keys whose operators changed mid-round were re-proven in dedicated
runs after the new14 batch, and their entries (provenance "r10 re-proof
(operator changed this round)") supersede. With the committed overrides
file, this script reproduces the published CORRECTNESS_sf10_r10.json
byte-for-byte (ADVICE r10). Round 11+ uses tools/assemble_sweep.py,
which gates carries on source hashes instead of hand assertions.

Usage: python tools/assemble_sf10_r10.py [NEW14.json [OUT.json [OVERRIDES.json]]]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    new14_path = sys.argv[1] if len(sys.argv) > 1 else (
        "CORRECTNESS_sf10_r10_new14.json"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_sf10_r10.json"

    r9 = json.load(open(os.path.join(REPO, "CORRECTNESS_sf10_r09.json")))
    new14 = json.load(open(os.path.join(REPO, new14_path)))

    merged = dict(r9["results"])
    for k in merged:
        merged[k].setdefault("provenance", "r9 sweep (code unchanged)")
    overlap = set(new14["results"]) & set(merged)
    assert not overlap, f"r10 re-ran keys r9 already passed: {sorted(overlap)}"
    for k, v in new14["results"].items():
        v["provenance"] = "r10 staged-oracle run"
        v["oracle"] = v.get("oracle", "staged (tools/oracle_staged.py)")
        merged[k] = v
    missing = set(r9["oracle_deferred"]) - set(new14["results"])
    assert not missing, f"r9-deferred keys still unproven: {sorted(missing)}"

    ov_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "tools", "sf10_r10_overrides.json"
    )
    if os.path.exists(ov_path):
        for k, v in json.load(open(ov_path)).items():
            assert "provenance" in v, f"override {k} lacks provenance"
            merged[k] = v

    n_pass = sum(
        1 for v in merged.values()
        if v.get("hash_match") and v.get("rows_match")
    )
    out = {
        "what": (
            "Round-10 100x hash sweep: DuckDB differential on the 100x "
            "replica (/tmp/scale/sf10) for EVERY hash-sweep-obligated key "
            "in SCALE_CLASSES.md. Closes the r9 sweep's 14 oracle-side "
            "deferrals (iterative-graph family, agg_mode_exact, simhash/"
            "editdistance/pq_adc/pca) with staged DuckDB oracles "
            "(tools/oracle_staged.py; staged == monolithic pinned at "
            "sf0.01 by tests/test_invariants_r8.py's parametrization and "
            "guarded by tests/test_invariants_r10.py). The other 440 keys "
            "carry their r9 proof: registry, operators, and replica "
            "unchanged for them this round (per-key provenance recorded). "
            "ZERO deferrals remain."
        ),
        "sf_dir": "/tmp/scale/sf10",
        "n_keys": len(merged),
        "n_pass": n_pass,
        "n_fail": len(merged) - n_pass,
        "n_deferred": 0,
        "results": dict(sorted(merged.items())),
    }
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"wrote {out_path}: {n_pass}/{len(merged)} pass, 0 deferred",
    )


if __name__ == "__main__":
    main()
