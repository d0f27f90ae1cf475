#!/usr/bin/env python
"""Merge parallel sweep-lane part files into one CORRECTNESS artifact.

The round-9 454-key 100x hash sweep runs as parallel lanes (disjoint key
sets) plus sequential retry passes for keys whose lane chunk crashed
(shared-box disk/memory pressure is a LANE failure, not a key failure).
This tool unions the per-lane results — later parts override earlier ones,
so a retry pass supersedes a crash-attributed failure — and writes the
final artifact with honest pass/fail counts.

Usage:
  python tools/merge_sweep_parts.py OUT.json sf_dir PART.json [PART.json...]
  python tools/merge_sweep_parts.py --failing PART.json [...]   # list keys
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_results(path: str) -> dict:
    d = json.load(open(path))
    d = d.get("results", d)
    out = {
        k: v for k, v in d.items() if isinstance(v, dict) and "hash_match" in v
    }
    # a rows-only part (mode=='rows-only', hash_match=None) is a WEAKER
    # gate than the hash sweep this tool assembles — refuse to merge it
    # into a hash artifact rather than silently over-claim hash coverage
    rows_only = sorted(
        k for k, v in out.items() if v.get("mode") == "rows-only"
    )
    if rows_only:
        raise SystemExit(
            f"{path} contains rows-only entries (weaker gate) that must "
            f"not merge into a hash-sweep artifact: {rows_only}"
        )
    return out


def main() -> None:
    if sys.argv[1] == "--failing":
        merged: dict = {}
        for p in sys.argv[2:]:
            merged.update(load_results(p))
        for k, v in sorted(merged.items()):
            if not (v.get("hash_match") and v.get("rows_match")):
                print(k)
        return

    out_path, sf_dir, parts = sys.argv[1], sys.argv[2], sys.argv[3:]
    merged = {}
    for p in parts:
        merged.update(load_results(p))  # later parts override
    n_pass = sum(
        1 for v in merged.values() if v.get("hash_match") and v.get("rows_match")
    )
    summary = {
        "what": (
            "Round-9 100x hash sweep: DuckDB differential on the 100x "
            f"replica ({sf_dir}) for EVERY hash-sweep-obligated key in "
            "SCALE_CLASSES.md (bounded-output + capped-growth). Run as "
            "parallel crash-isolated lanes (tools/sweep_chunked.py) over "
            "disjoint key sets, with sequential retry passes superseding "
            "lane-infrastructure failures (shared-box disk/memory "
            "pressure); staged disk-bounded oracles "
            "(tools/oracle_staged.py) for the iterative-graph keys and "
            "the layout-aware scan_dir_enumerate twin."
        ),
        "sf_dir": sf_dir,
        "n_keys": len(merged),
        "n_pass": n_pass,
        "n_fail": len(merged) - n_pass,
        "results": dict(sorted(merged.items())),
    }
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {out_path}: {n_pass} pass / {len(merged) - n_pass} fail "
          f"of {len(merged)}")


if __name__ == "__main__":
    main()
