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
    """Every hash-sweep-obligated key is either PASSING in the r9 100x
    artifact or explicitly recorded as oracle-deferred (its DuckDB
    monolithic oracle exceeds one box at 100x — the r7 precedent that r8
    closed with staged oracles; the deferred set is next round's staged-
    oracle work). A VALUE mismatch (hash false, no error) is never
    acceptable: that's a real correctness bug, not an infrastructure
    limit."""
    classes = _classes()
    art = json.load(open(os.path.join(REPO, "CORRECTNESS_sf10_r09.json")))
    res = art["results"]
    deferred = set(art.get("oracle_deferred", {}))
    obligated = {
        k for k, v in classes.items()
        if v["class"] in ("bounded-output", "capped-growth")
    }
    missing = sorted(obligated - set(res) - deferred)
    assert not missing, f"{len(missing)} hash-sweep keys missing: {missing[:8]}"
    value_mismatch = sorted(
        k for k in obligated & set(res)
        if not (res[k].get("hash_match") and res[k].get("rows_match"))
        and not res[k].get("err")
    )
    assert not value_mismatch, f"VALUE mismatches: {value_mismatch[:8]}"
    failing = sorted(
        k for k in obligated & set(res)
        if not (res[k].get("hash_match") and res[k].get("rows_match"))
        and k not in deferred
    )
    assert not failing, (
        f"{len(failing)} keys failing without a deferred record: "
        f"{failing[:8]}"
    )
    # every deferred key carries its recorded error and a reason
    for k in deferred:
        assert art["oracle_deferred"][k].get("reason"), k


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
