#!/usr/bin/env python
"""Generate the mod-only override file for src-hash-gated sweep assembly.

assemble_sweep.py refuses to carry a prior 100x proof when EITHER the
key's own function+oracle hash (src_hash) OR its defining module file
(mod_hash) changed. A round that hardens a few operators in a module
changes the module hash for every sibling key; this tool mechanically
verifies, per sibling, that the key's OWN src_hash is byte-identical to
the prior baseline and emits an override entry carrying the prior result
with that verification recorded — no hand-asserted provenance.

Usage:
  python tools/gen_modonly_overrides.py PRIOR.json PRIOR_HASHES.json OUT.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    prior_path, hashes_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    from c2_duckdb_runner_spark.registry import src_hashes

    now = src_hashes()
    prior = json.load(open(prior_path))["results"]
    old = json.load(open(hashes_path))

    overrides: dict = {}
    for k, v in prior.items():
        if k not in now or k not in old:
            continue
        if now[k]["src_hash"] != old[k]["src_hash"]:
            continue  # genuinely changed -> must re-run, not override
        if now[k]["mod_hash"] == old[k]["mod_hash"]:
            continue  # clean carry, no override needed
        e = dict(v)
        base = v.get("provenance", "prior sweep")
        e["provenance"] = (
            f"carried by mod-only override: {base}; this key's own "
            f"function body + oracle SQL hash-verified unchanged "
            f"(src_hash {now[k]['src_hash']}) — only sibling operators in "
            f"{now[k]['module']} changed this round"
        )
        overrides[k] = e
    with open(out_path, "w") as fh:
        json.dump(overrides, fh, indent=1)
    print(f"wrote {out_path}: {len(overrides)} mod-only overrides")


if __name__ == "__main__":
    main()
