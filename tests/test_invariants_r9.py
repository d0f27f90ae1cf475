"""Round-9 invariants: scale-class table pinning and sweep coverage.

The per-key 100x classification (SCALE_CLASSES.md) must stay in lockstep
with the registry and the committed artifacts — these tests turn verdict
r8 ask #2's "checkable artifact" requirement into CI:

1. the committed table matches what tools/gen_scale_classes.py generates
   (same discipline as COVERAGE.md / gen_coverage.py);
2. classification is TOTAL over the live registry;
3. every hash-sweep-obligated key (bounded-output + capped-growth) is
   present and passing in CORRECTNESS_sf10_r09.json;
4. every row-proportional key is present and passing in the rows-only
   gate artifact CORRECTNESS_sf10_rows_r09.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _classes():
    import gen_scale_classes

    return gen_scale_classes.classify()


def test_scale_classes_md_current():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_scale_classes.py"),
         "--check"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_scale_classes_total_over_registry():
    import __spark_entry__ as e

    classes = _classes()
    assert set(classes) == set(e.queries())
    assert all(
        v["class"] in ("bounded-output", "capped-growth", "row-proportional")
        for v in classes.values()
    )


def test_hash_sweep_covers_every_obligated_key():
    classes = _classes()
    art = json.load(open(os.path.join(REPO, "CORRECTNESS_sf10_r09.json")))
    res = art["results"]
    obligated = {
        k for k, v in classes.items()
        if v["class"] in ("bounded-output", "capped-growth")
    }
    missing = sorted(obligated - set(res))
    assert not missing, f"{len(missing)} hash-sweep keys missing: {missing[:8]}"
    failing = sorted(
        k for k in obligated
        if not (res[k].get("hash_match") and res[k].get("rows_match"))
    )
    assert not failing, f"{len(failing)} hash-sweep keys failing: {failing[:8]}"


def test_rows_only_gate_covers_row_proportional_keys():
    classes = _classes()
    art = json.load(
        open(os.path.join(REPO, "CORRECTNESS_sf10_rows_r09.json"))
    )
    res = art["results"]
    obligated = {
        k for k, v in classes.items() if v["class"] == "row-proportional"
    }
    missing = sorted(obligated - set(res))
    assert not missing, f"{len(missing)} rows-only keys missing: {missing[:8]}"
    failing = sorted(k for k in obligated if not res[k].get("rows_match"))
    assert not failing, f"{len(failing)} rows-only keys failing: {failing[:8]}"
