#!/usr/bin/env python
"""Assemble a 100x-sweep CORRECTNESS artifact with MECHANICAL provenance.

Replaces the hand-asserted "code unchanged" carry of rounds 9/10
(VERDICT r10 ask #4): every carried key must prove, by source hash, that
its operator function body + oracle SQL (src_hash) AND its defining
module (mod_hash — catches same-module helper changes) are identical to
what the prior artifact's run covered. Keys whose hashes changed are
REFUSED — they must appear in a fresh part file (a re-run) or an explicit
per-key overrides file (e.g. a re-proof run recorded elsewhere); there is
no silent carry.

Every emitted entry is stamped with the CURRENT hashes, so the next
round's assembly diffs mechanically against this artifact with no
separate baseline file.

Usage:
  python tools/assemble_sweep.py OUT.json \
      --prior PRIOR.json [--prior-hashes HASHES.json] \
      [--parts PART.json ...] [--overrides OV.json] \
      [--sf-dir /tmp/scale/sf10] [--what "..."]

--prior-hashes supplies the per-key {src_hash, mod_hash} in effect when
PRIOR was produced; if omitted, PRIOR's own per-entry src_hash/mod_hash
stamps are used (artifacts produced by this tool always have them).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HASH_FIELDS = ("src_hash", "mod_hash")


def _load_results(path: str) -> dict:
    d = json.load(open(path))
    d = d.get("results", d)
    out = {
        k: v for k, v in d.items() if isinstance(v, dict) and "hash_match" in v
    }
    rows_only = sorted(k for k, v in out.items() if v.get("mode") == "rows-only")
    if rows_only:
        raise SystemExit(
            f"{path} contains rows-only entries (weaker gate) that must "
            f"not merge into a hash-sweep artifact: {rows_only}"
        )
    return out


def assemble(
    prior: dict,
    prior_hashes: dict,
    parts: dict,
    overrides: dict,
    current_hashes: dict,
) -> tuple[dict, list[str]]:
    """Pure assembly: returns (merged results, refused-carry keys).

    Carry rule (pinned by tests/test_provenance.py): a prior key with no
    fresh part and no override is carried ONLY if both src_hash and
    mod_hash match the current registry source. Anything else is refused.
    """
    merged: dict = {}
    refused: list[str] = []
    for k, v in prior.items():
        if k in parts or k in overrides:
            continue
        cur = current_hashes.get(k)
        old = prior_hashes.get(k)
        if cur is None:
            refused.append(k)  # key no longer registered
            continue
        if old is None or any(old.get(f) != cur[f] for f in HASH_FIELDS):
            refused.append(k)
            continue
        e = dict(v)
        base = v.get("provenance", "prior sweep")
        if "(src+mod hash unchanged)" not in base:
            e["provenance"] = f"carried: {base} (src+mod hash unchanged)"
        e.update(cur)
        merged[k] = e
    for k, v in parts.items():
        e = dict(v)
        e.setdefault("provenance", "fresh run this round")
        if k in current_hashes:
            e.update(current_hashes[k])
        merged[k] = e
    for k, v in overrides.items():
        e = dict(v)
        if "provenance" not in e:
            raise SystemExit(
                f"override for {k} must carry an explicit provenance"
            )
        e["override"] = True
        if k in current_hashes:
            e.update(current_hashes[k])
        merged[k] = e
    return merged, sorted(refused)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--prior", required=True)
    ap.add_argument("--prior-hashes")
    ap.add_argument("--parts", nargs="*", default=[])
    ap.add_argument("--overrides")
    ap.add_argument("--sf-dir", default="/tmp/scale/sf10")
    ap.add_argument("--what", default="")
    args = ap.parse_args()

    from c2_duckdb_runner_spark.registry import src_hashes

    current = src_hashes()
    prior = _load_results(args.prior)
    if args.prior_hashes:
        prior_hashes = json.load(open(args.prior_hashes))
    else:
        prior_hashes = {
            k: {f: v[f] for f in HASH_FIELDS}
            for k, v in prior.items()
            if all(f in v for f in HASH_FIELDS)
        }
    parts: dict = {}
    for p in args.parts:
        parts.update(_load_results(p))  # later parts override
    overrides = json.load(open(args.overrides)) if args.overrides else {}

    merged, refused = assemble(prior, prior_hashes, parts, overrides, current)
    if refused:
        raise SystemExit(
            "REFUSING to carry prior proof for keys whose source changed "
            "(re-run them into a part file, or record an explicit "
            f"override): {refused}"
        )

    n_pass = sum(
        1 for v in merged.values() if v.get("hash_match") and v.get("rows_match")
    )
    out = {
        "what": args.what or (
            "100x hash sweep artifact assembled with src-hash-gated "
            "provenance (tools/assemble_sweep.py): carried keys are "
            "mechanically proven unchanged (operator function body + "
            "oracle SQL + defining module file) since the run that proved "
            "them; fresh parts and explicit overrides supersede."
        ),
        "sf_dir": args.sf_dir,
        "n_keys": len(merged),
        "n_pass": n_pass,
        "n_fail": len(merged) - n_pass,
        "n_deferred": 0,
        "results": dict(sorted(merged.items())),
    }
    with open(os.path.join(REPO, args.out), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {args.out}: {n_pass}/{len(merged)} pass, "
          f"{len(parts)} fresh, {len(overrides)} override, 0 refused")


if __name__ == "__main__":
    main()
