#!/usr/bin/env python
"""Dump the per-key source-provenance hashes (registry.src_hashes()) as
JSON — run at a given checkout to snapshot "what each operator's source
looked like" for sweep-carry gating (tools/assemble_sweep.py).

Usage: python tools/gen_src_hashes.py [OUT.json]   (default: stdout)
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    from c2_duckdb_runner_spark.registry import src_hashes

    h = src_hashes()
    payload = json.dumps(h, indent=1, sort_keys=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(payload)
        print(f"wrote {sys.argv[1]}: {len(h)} keys", file=sys.stderr)
    else:
        print(payload)


if __name__ == "__main__":
    main()
